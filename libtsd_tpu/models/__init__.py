from . import (analog, ber, bitstream, carrier_rec, channel, channelizer,  # noqa: F401
               clock_rec, clock_rec2, demod, demod_dec, demod_dec2,
               detector, doa, equalizer, frame, imu, kalman, lfsr,
               modulator, receivers, snr, spread, stats, waveform)
