from lets_face_it_tpu.train import (  # noqa: F401
    checkpoint,
    derange,
    evaluate,
    metrics,
    optim,
    state,
    tuning,
)
from lets_face_it_tpu.train.loop import train  # noqa: F401
