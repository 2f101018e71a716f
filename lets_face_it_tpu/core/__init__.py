from lets_face_it_tpu.core import ops, rnn  # noqa: F401
