"""lets_face_it_tpu — a TPU-native framework for probabilistic, interlocutor-aware
generation of 3-D facial gestures in dyadic settings.

Re-implements the capabilities of jonepatr/lets_face_it (IVA'20 "Let's Face It")
as an idiomatic JAX/XLA/Pallas/pjit framework:

* MoGlow-style conditional normalizing flow (actnorm, LU-decomposed invertible
  1x1 transform, affine coupling with a recurrent conditioning cell), compiled
  under ``jax.lax.scan`` instead of a per-frame Python loop.
* Sliding-window conditioning encoders batched over all time steps at once.
* Data-parallel training over a ``jax.sharding.Mesh`` (ICI collectives).
* jit-compiled audio feature extraction (MFCC / prosody / VAD) and FLAME
  blendshape+LBS mesh evaluation batched on TPU.
* A native C++ software rasterizer + stdlib HTTP render service replacing the
  reference's pyrender/EGL stack.

Reference layer map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"
