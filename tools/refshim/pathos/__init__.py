"""Serial stand-in for `pathos` (not installed): dgpsi imports
ProcessingPool at module top (reference gp.py:7, dgp.py:22) but the
anchor runs never call the p* methods, so a minimal serial pool is
enough to satisfy the import."""
