"""Packaged data files: measured kernel plans (plans_v5e.json)."""
