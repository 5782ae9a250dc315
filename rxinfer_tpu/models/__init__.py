"""Prebuilt model zoo (the reference's test-suite model families)."""
