"""Pipeline compositions (reference lifecycle §3 -> Ray Data DAGs)."""
