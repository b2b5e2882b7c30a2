"""Device mesh + sharding specs: DP over hosts (DCN), TP over ICI."""
