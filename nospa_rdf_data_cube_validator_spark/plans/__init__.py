from .algebra import (  # noqa: F401
    TripleStore,
    path_join,
    star_subjects,
    star_fetch,
)
from .closure import transitive_closure, reachable_pairs  # noqa: F401
