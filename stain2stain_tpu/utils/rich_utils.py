"""Rich console helpers: config tree printing + tag enforcement.

Parity components for /root/reference/src/utils/rich_utils.py:17-99:
``print_config_tree`` renders the composed config in field order (optionally
saving ``config_tree.log`` to the output dir); ``enforce_tags`` prompts for
tags when missing (hard error under multirun).
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

from stain2stain_tpu.config import Config, select

from .pylogger import RankedLogger

log = RankedLogger(__name__, rank_zero_only=True)

_FIELD_ORDER = (
    "data",
    "model",
    "callbacks",
    "logger",
    "trainer",
    "paths",
    "extras",
)


def print_config_tree(
    cfg: Config,
    print_order: Sequence[str] = _FIELD_ORDER,
    resolve: bool = False,
    save_to_file: bool = False,
) -> None:
    try:
        import rich.syntax
        import rich.tree
        from rich.console import Console
    except ImportError:
        print(cfg.to_yaml(resolve=resolve))
        return

    import yaml

    tree = rich.tree.Tree("CONFIG", style="dim", guide_style="dim")
    queue = [f for f in print_order if f in cfg]
    queue += [f for f in cfg if f not in queue and f not in ("runtime", "runtime_choices")]
    console = Console()
    for field in queue:
        branch = tree.add(field, style="dim", guide_style="dim")
        value = cfg.get_raw(field)
        if isinstance(value, Config):
            content = value.to_yaml(resolve=resolve)
        else:
            content = yaml.safe_dump({field: cfg.get(field)}) if not isinstance(value, str) else str(value)
        branch.add(rich.syntax.Syntax(content, "yaml"))
    console.print(tree)

    if save_to_file:
        out_dir = select(cfg, "paths.output_dir", default=None) or select(cfg, "runtime.output_dir", default=".")
        with open(Path(out_dir) / "config_tree.log", "w") as f:
            Console(file=f, width=120).print(tree)


def enforce_tags(cfg: Config, save_to_file: bool = False) -> None:
    if cfg.get("tags"):
        pass
    else:
        if cfg.get("runtime", {}) and select(cfg, "runtime.multirun", default=False):
            raise ValueError("Specify tags before launching a multirun!")
        log.warning("No tags provided in config. Prompting user to input tags...")
        try:
            tags = input("Enter a list of comma separated tags (dev): ") or "dev"
        except EOFError:
            tags = "dev"
        cfg["tags"] = [t.strip() for t in tags.split(",") if t.strip()]
        log.info(f"Tags: {cfg['tags']}")
    if save_to_file:
        out_dir = select(cfg, "paths.output_dir", default=None) or select(cfg, "runtime.output_dir", default=None)
        if out_dir:
            with open(Path(out_dir) / "tags.log", "w") as f:
                f.write(str(list(cfg["tags"])))


__all__ = ["print_config_tree", "enforce_tags"]
