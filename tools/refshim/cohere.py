"""Import-only stub for the ``cohere`` package.

The reference's semantic module (reference semantic.py:4) imports
``cohere`` at module load; without a COHERE_API_KEY it never
instantiates the client. This stub satisfies the import so the rest of
the reference package is measurable offline. Any attempt to actually
call the API raises, keeping the baseline honest about what ran.
"""


class ClientV2:
    def __init__(self, *a, **k):
        raise RuntimeError(
            "cohere stub: no network/API key in this environment — "
            "semantic queries are excluded from the measured baseline"
        )
