"""Query plans: the reference's public query surface as DataFrame pipelines."""
