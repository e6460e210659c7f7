"""Operator tooling: configurator CLI, calibration solver, family codebook
generation, log export (SURVEY.md section 2.1 L6/L7 parity)."""
