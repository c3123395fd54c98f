from bart_tpu.driver.cli import main

raise SystemExit(main())
