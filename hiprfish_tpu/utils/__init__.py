"""Utilities: synthetic data generation, structured logging, stage timing."""
