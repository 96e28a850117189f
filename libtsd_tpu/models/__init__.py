from . import (adsb, analog, ber, bitstream, carrier_rec, channel,  # noqa: F401
               channelizer, clock_rec, clock_rec2, demod, demod_dec,
               demod_dec2, detector, doa, equalizer, frame, imu, kalman,
               lfsr, modulator, pocsag, rds, receivers, snr, spread, stats,
               waveform)
