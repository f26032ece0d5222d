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
    return dict(QUERIES)


def oracle_sql():
    return dict(ORACLES)
