#!/usr/bin/env python
"""Interactive text-to-3D demo (the gradio_app.py equivalent).

The reference ships a gradio UI (/root/reference/gradio_app.py:114-157);
gradio isn't available in this image, so this is a dependency-free stdlib
HTTP server: type a prompt, get a turntable preview strip + a downloadable
vertex-colored OBJ. The pipeline compiles once at startup; each request is a
single jitted call.

  python demo.py [--port 7860] [--weights path]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import threading
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_PAGE = """<!doctype html>
<html><head><title>TriplaneTurbo-TPU</title>
<style>body{font-family:sans-serif;max-width:900px;margin:40px auto}
input{width:70%%;padding:8px}button{padding:8px 16px}
img{max-width:100%%;border:1px solid #ccc;margin-top:16px}</style></head>
<body><h2>TriplaneTurbo-TPU &mdash; text to textured mesh in &lt;1s</h2>
<form action="/generate" method="get">
<input name="prompt" placeholder="a DSLR photo of a hamburger" autofocus>
<button>Generate</button></form>
%s
</body></html>"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--out", default="outputs/demo")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    import numpy as np

    import triplaneturbo_tpu as ttt
    from triplaneturbo_tpu.evaluation import render_mesh_views
    from triplaneturbo_tpu.pipelines.triplaneturbo_text_to_3d import (
        TriplaneTurboTextTo3DPipeline,
        export_obj,
    )
    from triplaneturbo_tpu.utils.saving import save_image_grid

    ttt.info("building pipeline (first generation also compiles, ~3-10 min)...")
    pipe = TriplaneTurboTextTo3DPipeline.from_pretrained(args.weights, dtype_str="bfloat16")
    os.makedirs(args.out, exist_ok=True)
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _html(self, body: str, code: int = 200):
            data = (_PAGE % body).encode()
            self.send_response(code)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _file(self, path: str, ctype: str):
            with open(path, "rb") as f:
                data = f.read()
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            url = urllib.parse.urlparse(self.path)
            q = urllib.parse.parse_qs(url.query)
            if url.path == "/":
                return self._html("")
            if url.path == "/generate":
                prompt = (q.get("prompt") or ["a DSLR photo of a hamburger"])[0]
                slug = "".join(c if c.isalnum() else "_" for c in prompt)[:60]
                with lock:
                    t0 = time.time()
                    out = pipe(prompt, key=jax.random.PRNGKey(int(time.time()) % 2**31))
                    mesh = out["mesh"][0]
                    views = render_mesh_views(mesh, n_views=4, height=256, width=256)
                    dt = time.time() - t0
                    obj_path = export_obj(mesh, os.path.join(args.out, slug, "model.obj"))[0]
                    png_path = save_image_grid(
                        os.path.join(args.out, slug, "views.png"), list(np.asarray(views))
                    )
                body = (
                    f"<p><b>{prompt}</b> &mdash; {dt:.2f}s "
                    f"(<a href='/file?p={urllib.parse.quote(obj_path)}'>download OBJ</a>)</p>"
                    f"<img src='/file?p={urllib.parse.quote(png_path)}'>"
                )
                return self._html(body)
            if url.path == "/file":
                p = (q.get("p") or [""])[0]
                root = os.path.abspath(args.out)
                full = os.path.abspath(p)
                if not full.startswith(root) or not os.path.exists(full):
                    return self._html("<p>not found</p>", 404)
                ctype = "image/png" if full.endswith(".png") else "application/octet-stream"
                return self._file(full, ctype)
            return self._html("<p>not found</p>", 404)

    srv = ThreadingHTTPServer(("0.0.0.0", args.port), Handler)
    ttt.info(f"demo at http://localhost:{args.port}")
    srv.serve_forever()


if __name__ == "__main__":
    main()
