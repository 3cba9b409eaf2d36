"""Relational + training-data-pipeline operators over the driver testdata."""
