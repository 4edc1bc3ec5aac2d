"""Logical-plan layer: DSL parsing and compilation to Catalyst expressions."""
