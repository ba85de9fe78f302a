"""Offline data-conversion helpers (reference ``datasets/helpers/``)."""
