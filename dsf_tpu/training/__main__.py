"""CLI driver: `python -m dsf_tpu.training [--key value ...]`.

Replaces the reference's edit-the-file + `python train_render.py` flow
(train_render.py:874-889) with the same phase logic: train (+ per-epoch
test), then the NYU 3-view evaluation; or test-only.
"""

from __future__ import annotations

import argparse
import dataclasses


def parse_config(argv=None, description="dsf_tpu trainer"):
    from dsf_tpu.config import Config
    parser = argparse.ArgumentParser(description=description)
    for f in dataclasses.fields(Config):
        if f.type in ("bool", bool):
            parser.add_argument(f"--{f.name}", type=lambda s: s.lower() in
                                ("1", "true", "yes"), default=f.default)
        elif isinstance(f.default, tuple):
            parser.add_argument(f"--{f.name}", type=str,
                                default=",".join(map(str, f.default)))
        else:
            parser.add_argument(f"--{f.name}", type=type(f.default),
                                default=f.default)
    args = vars(parser.parse_args(argv))
    for f in dataclasses.fields(Config):
        if isinstance(f.default, tuple) and isinstance(args[f.name], str):
            elems = args[f.name].split(",")
            cast = str if isinstance(f.default[0], str) else float
            args[f.name] = tuple(cast(e) for e in elems)
    return Config(**args)


def main(argv=None):
    import sys
    argv = list(sys.argv[1:] if argv is None else argv)
    # subcommands for the auxiliary pipelines; default = the main trainer
    if argv and argv[0] in ("ccssl", "cyclegan"):
        sub, rest = argv[0], argv[1:]
        cfg = parse_config(rest, description=f"dsf_tpu {sub} pipeline")
        import logging
        logging.basicConfig(level=logging.INFO)
        from dsf_tpu.training import pipelines
        if sub == "ccssl":
            pipelines.run_ccssl(cfg)
        else:
            pipelines.run_cyclegan(cfg)
        return
    cfg = parse_config(argv)
    from dsf_tpu.training.loop import run
    run(cfg)


if __name__ == "__main__":
    main()
