#!/usr/bin/env python3
"""Run the HTTP service (reference deployment: uvicorn app.main:app on 8080,
reference backend/Dockerfile:29)."""

import argparse

import _bootstrap  # noqa: F401

from vision_compression_project_tpu.serve import serve_forever


def main():
    parser = argparse.ArgumentParser(description="Serve the document-QA API.")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8080)
    args = parser.parse_args()
    serve_forever(args.host, args.port)


if __name__ == "__main__":
    main()
