"""Text + audio front-end: normalization, BPE tokenization, feature extraction."""
