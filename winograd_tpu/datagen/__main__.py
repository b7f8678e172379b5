from winograd_tpu.datagen.generate import main

raise SystemExit(main())
