"""Relational operator builders — each registers queries in the engine registry."""
