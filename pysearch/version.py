__version__ = "0.1.0"

# Bump when analyzer/codec semantics change; stored in the index manifest so
# a resumed build refuses to mix incompatible segments.
INDEX_FORMAT_VERSION = 2  # v2: posting blocks carry a precomputed n_bytes
