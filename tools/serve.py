"""Online serving daemon CLI — load a bundle, listen, serve.

    python tools/serve.py --bundle DIR [--host 127.0.0.1] [--port 7600]
        [--device_resident] [--max_batch 256] [--max_wait_ms 2.0]
        [--save_on_exit] [--force_cpu]

Thin launcher for ``hpmn_tpu.serving.server:main`` (also installed as the
``hpmn-serve`` console script). Clients connect with
``hpmn_tpu.serving.client.ServingClient`` or speak the length-prefixed JSON
frame protocol directly — see serving/server.py.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hpmn_tpu.serving.server import main  # noqa: E402

if __name__ == "__main__":
    main()
