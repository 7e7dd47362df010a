"""Package entry point so the engine is directly ``ray job submit``-able:

    ray job submit --working-dir . -- python -m search_engine_ray \
        build s3://corpus/pages/ s3://index/v1/

Delegates to :mod:`search_engine_ray.cli` (same subcommands: build /
search / batch).
"""

import sys

from search_engine_ray.cli import main

if __name__ == "__main__":
    sys.exit(main())
