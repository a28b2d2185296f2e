"""RNN-VAD (reference: modules/audio_processing/agc2/rnn_vad/)."""
