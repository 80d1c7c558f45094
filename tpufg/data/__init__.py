"""Procedural training/validation data (no footage ships in the image)."""

from tpufg.data.corpus import NaturalCorpus, Scene, synthetic_triplets

__all__ = ["NaturalCorpus", "Scene", "synthetic_triplets"]
