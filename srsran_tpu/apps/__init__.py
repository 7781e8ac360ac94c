"""Applications: eNB and UE data-plane apps over file/UDP sample links."""
