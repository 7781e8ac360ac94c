"""UE-side PHY facades: sync/cell-search state machines, DL/UL processing."""
