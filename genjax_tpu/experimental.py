"""Experimental-API facade (drop-in mirror of the reference's empty
``genjax.experimental`` module, ``src/genjax/experimental.py``).

Nothing is experimental at the moment; features graduate straight into
the stable namespaces. Kept so reference code importing
``genjax.experimental`` ports by renaming the package only."""
