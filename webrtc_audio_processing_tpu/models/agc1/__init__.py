"""AGC1 (legacy gain control, reference: modules/audio_processing/agc/)."""
