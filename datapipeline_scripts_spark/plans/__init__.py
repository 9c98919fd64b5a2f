"""Plan inspection / audit utilities."""
