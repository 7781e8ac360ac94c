"""PHY layer: numerology, sequences, OFDM, modem, MIMO, FEC, channels."""

from . import common  # noqa: F401
