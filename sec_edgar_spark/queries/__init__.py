"""The oracle-checked query battery (driver contract).

Each module registers queries via ``registry.query``; importing this
package populates the registry.  ``__spark_entry__.py`` re-exports
``queries()`` / ``oracle_sql()`` from here.
"""

from .registry import ORACLES, QUERIES, query  # noqa: F401
from . import relational  # noqa: E402,F401
from . import relational2  # noqa: E402,F401
from . import relational3  # noqa: E402,F401
from . import edgar  # noqa: E402,F401
from . import edgar2  # noqa: E402,F401
from . import events  # noqa: E402,F401
from . import textops  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import parsing_q  # noqa: E402,F401
from . import curation  # noqa: E402,F401
from . import scalepats  # noqa: E402,F401
from . import entity  # noqa: E402,F401


def queries():
    """Registry in FAMILY-INTERLEAVED order (VERDICT r11 #8): eleven
    rounds of driver gates sampled the identical 50 relational
    queries because registration order led with the relational
    modules.  Round-robin across name-prefix families means any
    prefix-N sample crosses relational / edgar / events / text /
    dedup / ann / curation / graph / multimodal — no query is added,
    removed, or renamed, and every consumer looks up by name."""
    import re
    from collections import defaultdict

    groups: dict[str, list] = defaultdict(list)
    for name, fn in QUERIES.items():  # dict order = registration order
        # q1..q22 -> 'q', a1..a3 -> 'a', l1 -> 'l': numbered series
        # are ONE family, not one family per number
        fam = re.sub(r"\d+$", "", name.split("_", 1)[0])
        groups[fam].append((name, fn))
    fams = sorted(groups)
    out = {}
    rank = 0
    while len(out) < len(QUERIES):
        for f in fams:
            if rank < len(groups[f]):
                name, fn = groups[f][rank]
                out[name] = fn
        rank += 1
    return out


def oracle_sql():
    return dict(ORACLES)
