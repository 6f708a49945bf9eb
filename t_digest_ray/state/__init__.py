"""Sketch state objects: pure-python/numpy mergeable sketches (no Ray deps)."""
