from lets_face_it_tpu.features import audio_io, dsp, mfcc, prosody, vad  # noqa: F401
