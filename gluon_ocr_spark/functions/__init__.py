"""Reusable column/SQL expression builders (dual-dialect portable core)."""
