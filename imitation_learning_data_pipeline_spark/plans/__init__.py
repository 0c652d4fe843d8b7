"""Named end-to-end query plans — the driver-contract surface.

Importing this package populates the registry: each submodule registers
its queries (Spark plan builder + DuckDB oracle SQL) via
``registry.register``.
"""

from .registry import ORACLES, QUERIES, register  # noqa: F401

# Import for side effect: each module registers its plans.
from . import flagship  # noqa: E402,F401

_ALL_MODULES = [flagship]


def _late_imports() -> None:
    """Import remaining plan modules; kept separate so a syntax error in a
    new module is easy to localize during development."""
    global _ALL_MODULES
    from . import (  # noqa: F401
        curation,
        dedup,
        doremi,
        dsir,
        embedding_quality,
        graph,
        hll,
        lm,
        mllib_ops,
        monitor,
        multimodal_queries,
        numeric,
        pipeline_queries,
        privacy,
        profile,
        quality_model,
        relational,
        relational2,
        rollup,
        sampling,
        scalars,
        similarity,
        stage_chain,
        streaming_queries,
        temporal,
        web,
        text,
        tokenize,
        trajectory,
        windows,
    )

    _ALL_MODULES = [
        flagship,
        relational,
        relational2,
        scalars,
        windows,
        temporal,
        numeric,
        dedup,
        doremi,
        dsir,
        embedding_quality,
        sampling,
        text,
        similarity,
        pipeline_queries,
        multimodal_queries,
        streaming_queries,
        mllib_ops,
        curation,
        stage_chain,
        trajectory,
        profile,
        privacy,
        rollup,
        graph,
        hll,
        tokenize,
        lm,
        quality_model,
        monitor,
        web,
    ]


_late_imports()
