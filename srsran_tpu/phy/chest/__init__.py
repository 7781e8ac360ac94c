"""Channel estimation: CRS/DMRS generation, DL/UL estimators."""
