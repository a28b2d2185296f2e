"""AEC3 acoustic echo canceller (reference: modules/audio_processing/aec3/)."""
