"""Channel emulation: AWGN, multipath fading (EPA/EVA/ETU), delay drift,
high-speed-train Doppler, radio-link-failure gating."""
