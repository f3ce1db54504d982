from .pipeline import profile_arrays, profile_file  # noqa: F401
