"""Run the websocket inference server
(reference examples/ws_server.py analog).

Connect with: ws://localhost:7862 and send
  {"action": "infer", "text": "Hello", "max_new_tokens": 64}
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exllamav2_tpu import model_init  # noqa: E402
from exllamav2_tpu.server.websocket import WebSocketServer  # noqa: E402

ap = argparse.ArgumentParser()
model_init.add_args(ap)
ap.add_argument("--port", type=int, default=7862)
args = ap.parse_args()

model, tokenizer, generator = model_init.init(args)
server = WebSocketServer(generator, port=args.port)
print(f" -- serving on ws://0.0.0.0:{args.port}")
server.serve_forever()
