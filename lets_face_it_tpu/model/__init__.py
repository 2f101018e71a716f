from lets_face_it_tpu.model import encoders, flow, seqglow, spec  # noqa: F401
from lets_face_it_tpu.model.seqglow import (  # noqa: F401
    SeqGlowParams,
    init_seqglow,
    sequence_invert,
    sequence_nll,
    sequence_sample,
)
from lets_face_it_tpu.model.spec import CondSpec, EncSpec, FlowSpec  # noqa: F401
