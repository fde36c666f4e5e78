"""Scalar / batch functions: text normalization, HTML extraction, sketches."""
