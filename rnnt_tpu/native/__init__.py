"""Native (C++) runtime components, bound via ctypes.

The reference's native layer was the warp-transducer CUDA/OpenMP submodule
built by scripts/build_rnnt.sh; here the native layer is:

- flac_decoder.cc   — FLAC audio decoding (soundfile replacement for
                      LibriSpeech, utils/data/librispeech.py:6-16)
- rnnt_loss_cpu.cc  — OpenMP RNN-T loss + gradient (warp-transducer CPU-path
                      equivalent; independent oracle for the JAX/Pallas ops)

`build.py` compiles them with g++ on first use into _build/ (no pip/cmake
needed); scripts/build_native.sh is the explicit build driver
(scripts/build_rnnt.sh equivalent).
"""

from rnnt_tpu.native.build import load_library  # noqa: F401
