"""Command-line interface (reference: kge/cli.py).

Same UX as the reference: ``kge start/create/resume/eval/valid/test/
dump/package``, with every flattened configuration key available as a
``--key value`` flag auto-derived from the defaults.
"""

from __future__ import annotations

import argparse
import datetime
import os
import sys
import traceback
from typing import Dict, List

import yaml

from kge_tpu.config import Config
from kge_tpu.dataset import Dataset
from kge_tpu.train.job import Job
from kge_tpu.utils.io import get_checkpoint_file, load_checkpoint
from kge_tpu.utils.misc import kge_base_dir
from kge_tpu.utils.seed import seed_from_config


def argparse_bool_type(v):
    v = v.lower()
    if v in ("yes", "true", "t", "y", "1"):
        return True
    if v in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("boolean value expected")


def add_config_flags(parser: argparse.ArgumentParser, config: Config):
    """One flag per flattened default key (reference: cli.py:61-69)."""
    flags = set()
    for key, value in Config.flatten(config.options).items():
        if key in flags or "+++" in key:
            continue
        flags.add(key)
        arg_type = argparse_bool_type if isinstance(value, bool) else str
        parser.add_argument(f"--{key}", type=arg_type)
    # reference-compatible alias (reference: cli.py:76-84)
    parser.add_argument(
        "--abort-when-cache-outdated", action="store_const", const=True,
        default=None, dest="dataset.abort_when_cache_outdated",
    )


def create_parser(config: Config) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser("kge")
    subparsers = parser.add_subparsers(title="command", dest="command")
    subparsers.required = True

    parser_start = subparsers.add_parser(
        "start", help="Start a new job (create + run)")
    parser_create = subparsers.add_parser(
        "create", help="Create a new job folder without running")
    for p in (parser_start, parser_create):
        p.add_argument("config", type=str, nargs="?")
        p.add_argument("--folder", "-f", type=str)
        p.add_argument("--run", default=(p is parser_start),
                       type=argparse_bool_type)

    parser_resume = subparsers.add_parser(
        "resume", help="Resume a prior job from its folder")
    parser_eval = subparsers.add_parser(
        "eval", help="Evaluate a trained model")
    parser_valid = subparsers.add_parser(
        "valid", help="Evaluate on the validation split")
    parser_test = subparsers.add_parser(
        "test", help="Evaluate on the test split")
    for p in (parser_resume, parser_eval, parser_valid, parser_test):
        p.add_argument("config", type=str)
        p.add_argument("--checkpoint", type=str, default="default",
                       help="which checkpoint to use: 'default', 'last', "
                            "'best', or an epoch number")

    for p in (parser_start, parser_create, parser_resume, parser_eval,
              parser_valid, parser_test):
        add_config_flags(p, config)

    parser_dump = subparsers.add_parser(
        "dump", help="Dump trace, checkpoint, or config")
    from kge_tpu.utils.dump import add_dump_parsers

    add_dump_parsers(parser_dump)

    parser_package = subparsers.add_parser(
        "package", help="Strip a checkpoint into a distributable model file")
    parser_package.add_argument("checkpoint", type=str)
    parser_package.add_argument("--file", type=str, default=None)

    parser_import = subparsers.add_parser(
        "import-libkge",
        help="Convert a trained LibKGE (PyTorch) checkpoint into this "
             "framework's format")
    parser_import.add_argument("checkpoint", type=str)
    parser_import.add_argument("--file", type=str, required=True,
                               help="output checkpoint path")
    parser_import.add_argument("--dataset-folder", type=str, default=None,
                               help="dataset folder (required for R-GNN "
                                    "models; otherwise entity/relation "
                                    "counts are inferred from the tables)")
    return parser


def process_meta_command(args):
    """Rewrite meta commands to start/resume (reference: cli.py:158-165)."""
    if args.command == "eval":
        args.command = "resume"
        setattr(args, "job.type", "eval")
    elif args.command == "valid":
        args.command = "resume"
        setattr(args, "job.type", "eval")
        setattr(args, "eval.split", "valid")
    elif args.command == "test":
        args.command = "resume"
        setattr(args, "job.type", "eval")
        setattr(args, "eval.split", "test")


def collect_overrides(args, config: Config) -> Dict[str, str]:
    known = set(Config.flatten(config.options).keys())
    overrides = {}
    for key, value in vars(args).items():
        if value is not None and (key in known or "." in key):
            overrides[key] = value
    return overrides


def _parse_unknown(unknown: List[str]) -> Dict[str, str]:
    """Interpret leftover ``--key value`` pairs as config options (keys
    from imported component yamls are not known before the model loads)."""
    overrides = {}
    i = 0
    while i < len(unknown):
        token = unknown[i]
        if not token.startswith("--"):
            raise ValueError(f"unexpected argument {token}")
        key = token[2:]
        if "=" in key:
            key, value = key.split("=", 1)
            i += 1
        else:
            if i + 1 >= len(unknown):
                raise ValueError(f"missing value for --{key}")
            value = unknown[i + 1]
            i += 2
        overrides[key] = value
    return overrides


def main():
    config = Config()
    parser = create_parser(config)
    args, unknown = parser.parse_known_args()
    late_overrides = _parse_unknown(unknown)

    if args.command == "dump":
        from kge_tpu.utils.dump import dump

        try:
            dump(args)
        except BrokenPipeError:
            # downstream pager/head closed the pipe; exit quietly like
            # any well-behaved unix filter
            import sys

            sys.stderr.close()
        return
    if args.command == "import-libkge":
        # conversion is pure host work; never touch (or block on) an
        # accelerator backend
        import jax

        jax.config.update("jax_platforms", "cpu")

        from kge_tpu.utils.import_libkge import import_reference_checkpoint
        from kge_tpu.utils.io import save_checkpoint

        checkpoint = import_reference_checkpoint(
            args.checkpoint, dataset_folder=args.dataset_folder
        )
        save_checkpoint(args.file, checkpoint)
        print(f"imported {args.checkpoint} -> {args.file}")
        return
    if args.command == "package":
        from kge_tpu.utils.package import package_model

        package_model(args.checkpoint, args.file)
        return

    process_meta_command(args)

    if args.command in ("start", "create"):
        if args.config:
            config.load(args.config, create=True)
        for key, value in collect_overrides(args, config).items():
            if key in ("config", "folder", "run", "command", "checkpoint"):
                continue
            if key == "model":
                config._import(value)
            config.set(key, value, create=True)
        for key, value in late_overrides.items():
            # late keys come from imported component yamls, which exist
            # by now; creating unknown keys would make a typo'd flag a
            # silent no-op (reference CLI rejects unknown keys)
            config.set(key, value)
        # determine output folder
        if args.folder:
            folder = args.folder
        else:
            config_name = (
                os.path.splitext(os.path.basename(args.config))[0]
                if args.config else config.get("model") or "job"
            )
            timestamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
            folder = os.path.join(
                kge_base_dir(), "local", "experiments",
                f"{timestamp}-{config_name}",
            )
        config.folder = folder
        if not config.init_folder():
            raise ValueError(f"output folder {folder} already exists")
        if args.command == "create" and not args.run:
            config.log(f"Created job folder {folder}")
            return
        checkpoint = None
    else:  # resume
        folder = args.config
        if os.path.isfile(folder):
            folder = os.path.dirname(folder) or "."
        config_path = os.path.join(folder, "config.yaml")
        config = Config(folder=folder)
        config.load(config_path, create=True)
        for key, value in collect_overrides(args, config).items():
            if key in ("config", "folder", "run", "command", "checkpoint"):
                continue
            config.set(key, value, create=True)
        for key, value in late_overrides.items():
            config.set(key, value)  # unknown keys error (typo guard)
        checkpoint_file = get_checkpoint_file(config, args.checkpoint)
        # no checkpoint on disk (e.g. a search folder: trials carry their
        # own checkpoints) -> recreate the job fresh from the saved config
        if checkpoint_file is not None:
            checkpoint = load_checkpoint(checkpoint_file)
        else:
            config.log(
                "No checkpoint found or specified, starting from scratch..."
            )
            checkpoint = None

    try:
        if config.get("job.device") == "cpu":
            # keep CPU jobs off accelerator plugins entirely (a busy
            # single-client TPU tunnel would otherwise block backend init)
            import jax

            jax.config.update("jax_platforms", "cpu")
        from kge_tpu.parallel.distributed import maybe_init_from_config

        maybe_init_from_config(config)
        seed_from_config(config)
        config.log("Using folder " + str(config.folder))
        dataset = Dataset.create(config)
        if checkpoint is not None:
            job = Job.create_from(
                checkpoint, new_config=config, dataset=dataset
            )
        else:
            job = Job.create(config, dataset)
        job.run()
    except BaseException:
        tb = traceback.format_exc()
        config.log(tb, echo=False)
        raise


if __name__ == "__main__":
    main()
