"""Medallion / article-domain queries (filled in next)."""
