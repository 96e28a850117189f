"""libtsd-tpu: a TPU-native DSP / software-radio framework (JAX/XLA/Pallas).

Brand-new design with the capabilities of tsdconseil/libtsd (C++/CPU reference
at /root/reference — see SURVEY.md): spectral analysis, FIR/IIR filter design
and streaming runtime, resampling, telecom modems with clock/carrier recovery,
Kalman/DOA applications, and host-side visualization/reporting.

Layout:
* ``libtsd_tpu.ops``      — numerics: FFT/PSD/correlation, windows, filter
  design + runtime, resampling, Pallas kernels.
* ``libtsd_tpu.models``   — telecom/SDR stack (waveforms, modems, receivers)
  and estimation apps (Kalman, DOA).
* ``libtsd_tpu.parallel`` — mesh/sharding layer: channel + time-block
  sharding with overlap-save halo exchange over ICI.
* ``libtsd_tpu.utils``    — WAV I/O, time, geometry, monitors, test helpers.
* ``libtsd_tpu.viz``      — figure/report sink (host-side).
"""

from . import config
from .block import Block, Chain, chain, Identity, stream, pad_to_multiple

__version__ = "0.1.0"
