"""AGC2 submodules (reference: modules/audio_processing/agc2/)."""
