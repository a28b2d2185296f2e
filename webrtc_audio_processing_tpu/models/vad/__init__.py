"""Voice activity detection family (legacy GMM VAD + analytics VAD)."""
