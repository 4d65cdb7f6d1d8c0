from gs2pc.cli import main

main()
