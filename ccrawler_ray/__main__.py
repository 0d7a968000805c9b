"""E2 production entry: ``python -m ccrawler_ray --config cfg.yaml``.

Runs the generation-loop crawl over a corpus parquet, with optional
checkpoint dir (resume with --resume) and output dir for docs_out.
Owns its Ray session (library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="ccrawler_ray")
    p.add_argument("--config", required=True, help="crawl config (yaml/json)")
    p.add_argument("--corpus", required=True, help="interleaved docs parquet")
    p.add_argument("--seeds-file", help="seed list file (overrides config seeds)")
    p.add_argument("--ckpt-dir", help="checkpoint directory (enables resume)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--out", help="write docs_out parquet here")
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        from ccrawler_ray.config import CrawlConfig
        from ccrawler_ray.pipelines.crawl import CrawlEngine
        from ccrawler_ray.sources.seeds import read_seed_file

        cfg = CrawlConfig.from_file(args.config)
        if args.seeds_file:
            import dataclasses

            cfg = dataclasses.replace(cfg, seeds=read_seed_file(args.seeds_file))
        ncpu = args.num_cpus or int(ray.cluster_resources().get("CPU", 8))
        cfg = cfg.scaled_for(ncpu)
        eng = CrawlEngine(args.corpus, cfg, ckpt_dir=args.ckpt_dir)
        if args.resume and args.ckpt_dir:
            eng.resume()
        res = eng.run()
        if args.out:
            res.docs_out.write_parquet(args.out)
        summary = {
            "generations": res.generations_run,
            "urls_seen": res.seen.num_rows,
            "urls_fetched": len(res.crawl_order),
            "docs_out": res.docs_out.count(),
        }
        print(json.dumps(summary))
        eng.shutdown()
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
