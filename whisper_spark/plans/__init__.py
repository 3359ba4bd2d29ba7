from .routing import explain_fetch, route_resolution  # noqa: F401
