// Microphone -> int16 PCM websocket streamer for the ASR server
// (equivalent of the reference's web/js/streaming_record.js; also fixes
// its protocol gap: we end with the __EOS__ JSON command the server
// actually understands, not a bare 'Done').
let ws = null, ctx = null, processor = null, source = null;
let recording = false;

const btn = document.getElementById('rec');
const statusEl = document.getElementById('status');
const partialEl = document.getElementById('partial');
const finalsEl = document.getElementById('finals');

const WS_PATH = '/voice/api/asr/v1/ws/decode_online' +
  '?content-type=audio/x-raw,+layout=(string)interleaved,+rate=(int)16000';

btn.onclick = async () => {
  if (recording) { stop(); return; }
  const proto = location.protocol === 'https:' ? 'wss://' : 'ws://';
  ws = new WebSocket(proto + location.host + WS_PATH);
  ws.onmessage = (e) => {
    if (e.data === '__REQUEST_COMPLETED__') { statusEl.textContent = 'done'; return; }
    const m = JSON.parse(e.data);
    const hyp = m.result && m.result.hypotheses && m.result.hypotheses[0];
    if (!hyp) return;
    if (m.result.final) {
      const div = document.createElement('div');
      div.textContent = hyp.transcript_normalized || hyp.transcript;
      const meta = document.createElement('span');
      meta.className = 'meta';
      meta.textContent = ` [seg ${m.segment}, conf ${hyp.confidence}]`;
      div.appendChild(meta);
      finalsEl.appendChild(div);
      partialEl.textContent = '';
    } else {
      partialEl.textContent = hyp.transcript;
    }
  };
  ws.onopen = async () => {
    ctx = new AudioContext({ sampleRate: 16000 });
    const stream = await navigator.mediaDevices.getUserMedia({ audio: true });
    source = ctx.createMediaStreamSource(stream);
    processor = ctx.createScriptProcessor(4096, 1, 1);
    processor.onaudioprocess = (e) => {
      const f = e.inputBuffer.getChannelData(0);
      const i16 = new Int16Array(f.length);
      for (let i = 0; i < f.length; i++) {
        i16[i] = Math.max(-32768, Math.min(32767, f[i] * 32767));
      }
      if (ws && ws.readyState === 1) ws.send(i16.buffer);
    };
    source.connect(processor);
    processor.connect(ctx.destination);
    recording = true;
    btn.textContent = 'Stop';
    statusEl.textContent = 'recording...';
  };
};

function stop() {
  recording = false;
  btn.textContent = 'Start recording';
  statusEl.textContent = 'flushing...';
  if (processor) { processor.disconnect(); processor = null; }
  if (source) { source.disconnect(); source = null; }
  if (ctx) { ctx.close(); ctx = null; }
  if (ws && ws.readyState === 1) {
    ws.send(JSON.stringify({ '__COMMAND__': '__EOS__' }));
  }
}
