from . import corr, fft, psd, rng, signal, window  # noqa: F401
