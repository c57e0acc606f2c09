"""JSON-over-websocket inference server.

Analog of ExLlamaV2WebSocketServer (exllamav2/server/websocket*.py): a
small action-dispatch protocol — echo / estimate_token / lefttrim_token /
infer / stop — streaming generated chunks as they arrive. Production API
serving is expected to layer an OpenAI-style gateway on top (the
reference delegates that to TabbyAPI, README.md:5-9).
"""

from __future__ import annotations

import asyncio
import json

from exllamav2_tpu.generator.dynamic import DynamicGenerator, DynamicJob
from exllamav2_tpu.generator.sampler import Settings

__all__ = ["WebSocketServer"]


class WebSocketServer:
    def __init__(self, generator: DynamicGenerator, ip: str = "0.0.0.0",
                 port: int = 7862):
        self.generator = generator
        self.tokenizer = generator.tokenizer
        self.ip = ip
        self.port = port
        self.stop_signal = False
        self.serve_task = None

    def serve_forever(self):
        asyncio.run(self.main())

    async def main(self):
        import websockets
        async with websockets.serve(self.handler, self.ip, self.port):
            await asyncio.Future()

    async def handler(self, ws):
        async for message in ws:
            try:
                request = json.loads(message)
            except json.JSONDecodeError:
                await ws.send(json.dumps({"error": "bad json"}))
                continue
            await self.dispatch(request, ws)

    async def dispatch(self, request: dict, ws):
        action = request.get("action")
        response = {"action": action}
        for k in ("request_id", "response_id"):
            if k in request:
                response[k] = request[k]

        if action == "echo":
            pass
        elif action == "estimate_token":
            ids = self.tokenizer.encode(request["text"])
            response["num_tokens"] = int(len(ids))
        elif action == "lefttrim_token":
            ids = self.tokenizer.encode(request["text"])
            limit = int(request["max_tokens"])
            response["trimmed_text"] = self.tokenizer.decode(ids[-limit:])
        elif action == "infer":
            await self.infer(request, ws, response)
            return
        elif action == "stop":
            self.stop_signal = True
        else:
            response["error"] = f"unknown action {action!r}"
        await ws.send(json.dumps(response))

    async def infer(self, request: dict, ws, response: dict):
        self.stop_signal = False
        s = Settings()
        for key, attr in (("temperature", "temperature"),
                          ("top_k", "top_k"), ("top_p", "top_p"),
                          ("min_p", "min_p"),
                          ("rep_pen", "token_repetition_penalty")):
            if key in request:
                setattr(s, attr, request[key])
        ids = self.tokenizer.encode(request["text"],
                                    add_bos=request.get("add_bos", False))
        stop_conditions = request.get("stop_conditions", [])
        job = DynamicJob(ids, max_new_tokens=int(
            request.get("max_new_tokens", 256)), settings=s,
            stop_conditions=stop_conditions)
        self.generator.enqueue(job)

        full = ""
        while job.status != "done" and not self.stop_signal:
            results = await asyncio.to_thread(self.generator.iterate)
            for r in results:
                if r.get("serial") != id(job) or r["stage"] != "streaming":
                    continue
                chunk = r.get("text", "")
                full += chunk
                if chunk and request.get("stream", True):
                    await ws.send(json.dumps({
                        "action": "infer", "response_type": "chunk",
                        "chunk": chunk,
                        **{k: response[k] for k in
                           ("request_id", "response_id") if k in response},
                    }))
        response["response_type"] = "full"
        response["util_text"] = ""
        response["response"] = full
        await ws.send(json.dumps(response))
