"""Minimal L2 stack: MAC PDU codec, round-robin scheduler, HARQ state."""
