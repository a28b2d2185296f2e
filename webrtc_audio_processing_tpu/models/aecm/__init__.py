"""AECM mobile echo control (reference: modules/audio_processing/aecm/)."""
