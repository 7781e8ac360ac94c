"""Synchronization: PSS/SSS detection, CFO estimation, cell search."""
