"""Pure-functional flax model definitions for the IndexTTS2 cascade."""
