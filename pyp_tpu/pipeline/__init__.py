"""Pipeline stages as pure functions over arrays + metadata."""
