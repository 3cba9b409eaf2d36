"""Vectorized extraction UDFs: html->text, identifier mentions, OIE triples."""
