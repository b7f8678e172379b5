from winograd_tpu.bench.cli import main

raise SystemExit(main())
