"""Scalar / vector / UDF function packs."""
