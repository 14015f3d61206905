"""placeholder — populated in later milestone."""
