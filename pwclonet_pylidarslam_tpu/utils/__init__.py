"""Utilities: config loading, shape checks, timers, pose IO."""
