"""eNodeB-side PHY facades: full DL subframe generation, UL reception."""
