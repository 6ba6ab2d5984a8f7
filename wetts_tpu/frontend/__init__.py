"""BERT frontend: dataset, trainer, eval, inference (prosody + polyphone)."""
