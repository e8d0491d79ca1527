"""Fleet launcher CLI — N uid-hash shard daemons from one command.

    python tools/serve_fleet.py --bundle DIR --shards N [--base_port 7600]

Thin launcher for ``hpmn_tpu.serving.fleet:main`` (also installed as the
``hpmn-serve-fleet`` console script); prints ``FLEET ready: host:port ...``
— the address list ``ShardedServingClient`` consumes. See
serving/fleet.py for the full contract (per-shard journals, no
save_on_exit by design).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hpmn_tpu.serving.fleet import main  # noqa: E402

if __name__ == "__main__":
    main()
