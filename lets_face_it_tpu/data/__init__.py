from lets_face_it_tpu.data.windows import (  # noqa: F401
    WindowDataset,
    de_standardize,
    face_means_stds,
    load_standardization,
)
