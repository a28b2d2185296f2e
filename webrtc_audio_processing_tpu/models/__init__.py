"""Processing submodules (reference layer L3/L4: modules/audio_processing/)."""
