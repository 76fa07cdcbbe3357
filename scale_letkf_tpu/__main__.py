from scale_letkf_tpu.cli.main import main

main()
