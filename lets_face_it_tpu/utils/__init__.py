from lets_face_it_tpu.utils import native  # noqa: F401
