"""LTE physical channels: SCH coding chain, PDSCH/PBCH/PDCCH/PUSCH/..."""
