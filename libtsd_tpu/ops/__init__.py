from . import (corr, cqt, dwt, fft, filter_rt, fir_design, iir_design,  # noqa: F401
               poly, psd, resample, rng, signal, window)
from . import pallas  # noqa: F401
