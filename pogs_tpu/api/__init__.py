"""User-facing problem APIs (graph form, cone form, CVXPY)."""
