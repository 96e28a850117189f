from . import (analog, ber, bitstream, carrier_rec, channel, clock_rec,  # noqa: F401
               demod, detector, doa, equalizer, frame, kalman, lfsr,
               modulator, snr, spread, stats, waveform)
