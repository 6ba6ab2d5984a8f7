"""Utilities: WAV I/O, tables, logging."""
