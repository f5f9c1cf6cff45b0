"""End-to-end pipeline drivers (compose stages into Dataset graphs)."""
