from video_stabilization_tpu.cli.app import main

raise SystemExit(main())
