"""Populated in a later build wave."""
