from se_tpu.cli import main

main()
