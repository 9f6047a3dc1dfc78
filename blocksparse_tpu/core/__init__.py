"""Core layout, operator algebra, and schedule abstractions."""
