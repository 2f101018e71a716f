from lets_face_it_tpu.render import flame  # noqa: F401
