from lets_face_it_tpu.sample.generate import (  # noqa: F401
    Generator,
    dictify_frames,
    expand_face_dim,
    generate_motion,
)
from lets_face_it_tpu.sample.torch_import import (  # noqa: F401
    export_state_dict,
    import_torch_checkpoint,
)
