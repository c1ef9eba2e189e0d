"""LLaVA reward clients tested against a local HTTP stub server.

The real LLaVA server (reference README.md:49-51) is a GPU service; here a
stdlib HTTP server speaks the same pickle protocol so the client logic
(JPEG batching, request format, satisfaction/recall scoring) is covered.
"""

import pickle
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from ddpo_tpu.training.callbacks import llava_bertscore, llava_vqa_satisfaction


class _StubHandler(BaseHTTPRequestHandler):
    def do_POST(self):
        length = int(self.headers["Content-Length"])
        data = pickle.loads(self.rfile.read(length))
        n = len(data["images"])
        assert all(isinstance(b, bytes) for b in data["images"])

        if "answers" in data:  # bertscore mode
            response = {
                "recall": [[0.75]] * n,
                "precision": [[0.5]] * n,
                "f1": [[0.6]] * n,
                "outputs": [["a photo of something"]] * n,
            }
        else:  # vqa mode: echo per-query answers, first correct
            response = {
                "outputs": [
                    ["yes" if i == 0 else "wrong" for i, _ in enumerate(queries)]
                    for queries in data["queries"]
                ]
            }
        payload = pickle.dumps(response)
        self.send_response(200)
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *args):
        pass


@pytest.fixture(scope="module")
def stub_server():
    server = HTTPServer(("127.0.0.1", 0), _StubHandler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


def test_llava_bertscore_client(stub_server):
    fn = llava_bertscore(url=stub_server, batch_size=2)
    images = np.random.default_rng(0).random((5, 32, 32, 3)).astype(np.float32)
    prompts = [f"a dog {i}" for i in range(5)]
    scores, info = fn(images, prompts, None)
    assert scores.shape == (5,)
    np.testing.assert_allclose(scores, 0.75)
    np.testing.assert_allclose(info["precision"], 0.5)
    np.testing.assert_allclose(info["f1"], 0.6)
    assert len(info["outputs"]) == 5


def test_llava_vqa_client(stub_server):
    fn = llava_vqa_satisfaction(url=stub_server, batch_size=2)
    images = np.random.default_rng(0).random((4, 32, 32, 3)).astype(np.float32)
    metadata = [
        {"questions": ["is it a dog?", "how many?"], "answers": ["yes", "two"]}
        for _ in range(4)
    ]
    scores, info = fn(images, None, metadata)
    # stub answers: first question "yes" (correct), second "wrong" -> 0.5
    np.testing.assert_allclose(scores, 0.5)
    assert len(info["answers"]) == 4
