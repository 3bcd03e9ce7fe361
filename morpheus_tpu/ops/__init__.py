from . import codes, density, encodings, hashgrid, mlp, occupancy, volrender  # noqa: F401
